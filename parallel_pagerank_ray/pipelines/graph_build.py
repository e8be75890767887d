"""links -> vertices -> deduplicated edges -> degrees (SURVEY.md §2.4/2.5).

The reference builds a CSR straight from an integer edge-list file with
``N = max_node_id + 1`` (/root/reference/pagerank_mpi/csr_graph.c:20-27).
Here the graph is built as Ray Data shuffles:

- vertex set = union of src and dst urls (SURVEY.md J4), dense vids
  assigned per hash bucket (deterministic, no global sort bottleneck);
- ``links ⋈ vertices`` hash joins resolve urls to int64 vids (J1/J4);
- exact edge dedup via groupby on (src, dst) (A10 — note the reference
  keeps duplicates; the north rule demands a deduplicated edge table);
- out-degrees via groupby on src (M4).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from parallel_pagerank_ray.functions.extract import ExtractLinks
from parallel_pagerank_ray.util import drop_empty_blocks, safe_join

_HASH_KEY = "0123456789123456"  # pandas default; fixed -> deterministic across runs


def stable_bucket(urls: pd.Series, num_buckets: int) -> np.ndarray:
    """Deterministic (process-independent) hash bucket per url."""
    h = pd.util.hash_pandas_object(urls, index=False, hash_key=_HASH_KEY)
    return (h % np.uint64(num_buckets)).astype(np.int64)


def links_from_pages(pages: rd.Dataset, concurrency: int | None = None) -> rd.Dataset:
    """pages (url, html, ...) -> links (src_url, dst_url). Flat-map stage.

    Runs as stateless tasks (callable INSTANCE): the extractor has no
    per-worker state worth amortizing, and a fixed-size actor pool can
    reserve every CPU of a small cluster and starve the read stage.
    ``concurrency`` caps concurrent tasks when set.
    """
    kwargs = {} if concurrency is None else {"concurrency": concurrency}
    return pages.select_columns(["url", "html"]).map_batches(
        ExtractLinks(), batch_format="pyarrow", **kwargs
    )


def assign_vertex_ids(links: rd.Dataset, num_buckets: int = 64) -> rd.Dataset:
    """Distinct urls (src ∪ dst) -> vertices (url, vid) with dense vid 0..N-1.

    Dense enumeration without a global sort: per-batch distinct + stable
    hash bucket, one bucket shuffle, per-bucket sorted dedup with a
    local index (map_groups, vectorized), then prefix-sum bucket offsets
    on the driver and a final offset-add map. The vid<->url bijection is
    deterministic for a given url set at any parallelism.
    """
    def partial(t: pa.Table) -> pa.Table:
        # one pass over links (src+dst columns concatenated) instead of
        # a union of two scans; Arrow group_by distinct before the
        # shuffle so only per-batch-unique urls ever move
        u = pa.concat_arrays(
            [
                t.column("src_url").combine_chunks(),
                t.column("dst_url").combine_chunks(),
            ]
        )
        ut = pa.table({"url": u}).group_by(["url"], use_threads=False).aggregate([])
        b = stable_bucket(ut.column("url").to_pandas(), num_buckets)
        return ut.append_column("bucket", pa.array(b))

    def enumerate_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset="url").sort_values("url")
        return pd.DataFrame(
            {
                "url": g["url"].to_numpy(),
                "bucket": g["bucket"].to_numpy(),
                "local_idx": np.arange(len(g), dtype=np.int64),
            }
        )

    per_bucket = drop_empty_blocks(
        links.select_columns(["src_url", "dst_url"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(enumerate_bucket, batch_format="pandas")
    ).materialize()

    counts = (
        per_bucket.map_batches(
            lambda df: df.groupby("bucket", sort=False).size().reset_index(name="n")
            if len(df)
            else pd.DataFrame(),
            batch_format="pandas",
        ).take_all()
    )
    counts_by_bucket: dict[int, int] = {}
    for r in counts:
        counts_by_bucket[int(r["bucket"])] = (
            counts_by_bucket.get(int(r["bucket"]), 0) + int(r["n"])
        )
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(counts_by_bucket):
        offsets[b] = acc
        acc += counts_by_bucket[b]

    def add_offset(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame()
        base = df["bucket"].map(offsets).to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"url": df["url"], "vid": base + df["local_idx"].to_numpy()}
        )

    return drop_empty_blocks(
        per_bucket.map_batches(add_offset, batch_format="pandas")
    )


def assign_int_ids(
    ids: rd.Dataset, col: str = "doc_id", num_buckets: int = 64
) -> rd.Dataset:
    """Distinct int keys -> (col, vid) with dense vid 0..N-1.

    The integer-key sibling of ``assign_vertex_ids`` (same
    bucket-enumerate-offset shape, no global sort): per-batch distinct,
    stable hash bucket, per-bucket sorted dedup with a local index,
    driver-side prefix-sum of the (tiny) per-bucket counts, final
    offset-add map. Deterministic for a given key set at any
    parallelism. Used to densify sparse/hashed 64-bit ids before
    running a BSP vertex algorithm whose state vectors are sized by
    the dense domain, never by max(id)."""

    def partial(t: pa.Table) -> pa.Table:
        ut = (
            t.select([col])
            .group_by([col], use_threads=False)
            .aggregate([])
        )
        h = pd.util.hash_pandas_object(
            ut.column(col).to_pandas(), index=False, hash_key=_HASH_KEY
        )
        b = (h.to_numpy() % np.uint64(num_buckets)).astype(np.int64)
        return ut.append_column("bucket", pa.array(b))

    def enumerate_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=col).sort_values(col)
        return pd.DataFrame(
            {
                col: g[col].to_numpy(),
                "bucket": g["bucket"].to_numpy(),
                "local_idx": np.arange(len(g), dtype=np.int64),
            }
        )

    per_bucket = drop_empty_blocks(
        ids.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(enumerate_bucket, batch_format="pandas")
    ).materialize()

    counts = per_bucket.map_batches(
        lambda df: df.groupby("bucket", sort=False).size().reset_index(name="n")
        if len(df)
        else pd.DataFrame(),
        batch_format="pandas",
    ).take_all()
    counts_by_bucket: dict[int, int] = {}
    for r in counts:
        counts_by_bucket[int(r["bucket"])] = (
            counts_by_bucket.get(int(r["bucket"]), 0) + int(r["n"])
        )
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(counts_by_bucket):
        offsets[b] = acc
        acc += counts_by_bucket[b]

    def add_offset(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame()
        base = df["bucket"].map(offsets).to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {col: df[col].to_numpy(), "vid": base + df["local_idx"].to_numpy()}
        )

    return drop_empty_blocks(
        per_bucket.map_batches(add_offset, batch_format="pandas")
    )


def _default_join_partitions() -> int:
    import ray

    return max(8, int(ray.cluster_resources().get("CPU", 8)))


# per-worker cache of the broadcast url->vid index (bounded FIFO): the
# pandas Index is built once per worker per map, not once per batch
_RESOLVE_CACHE: dict[str, tuple] = {}


def _resolve_lookup(t: pa.Table, map_ref, extra: tuple[str, ...] = ()) -> pa.Table:
    import ray

    key = map_ref.hex()
    cached = _RESOLVE_CACHE.get(key)
    if cached is None:
        urls, vids = ray.get(map_ref)
        cached = (pd.Index(urls), vids)
        if len(_RESOLVE_CACHE) >= 4:
            _RESOLVE_CACHE.pop(next(iter(_RESOLVE_CACHE)))
        _RESOLVE_CACHE[key] = cached
    index, vids = cached
    s = index.get_indexer(t.column("src_url").to_pandas())
    d = index.get_indexer(t.column("dst_url").to_pandas())
    m = (s >= 0) & (d >= 0)  # inner-join semantics: drop unknown urls
    cols: dict = {"src": vids[s[m]], "dst": vids[d[m]]}
    if extra:
        mask = pa.array(m)
        for c in extra:
            cols[c] = t.column(c).combine_chunks().filter(mask)
    return pa.table(cols)


def resolve_edges(
    links: rd.Dataset,
    vertices: rd.Dataset,
    num_partitions: int | None = None,
    broadcast_max: int = 5_000_000,
    extra: tuple[str, ...] = (),
) -> rd.Dataset:
    """links (src_url, dst_url) ⋈ vertices twice -> int edges (src, dst).

    Small-side broadcast fast path: when the vertex table fits plasma
    comfortably (<= ``broadcast_max`` rows) the url->vid map ships ONCE
    via ray.put and every batch resolves with one hash lookup — no
    shuffle at all. The two hash joins remain the unbounded-n fallback
    (at 10^12 urls the map no longer broadcasts).

    ``extra`` columns (e.g. an edge weight) ride through both paths
    unchanged.
    """
    import functools

    import ray

    n_verts = vertices.count()
    if n_verts <= broadcast_max:
        parts = ray.get(vertices.to_arrow_refs())
        tbl = pa.concat_tables(parts) if parts else None
        if tbl is not None and tbl.num_rows:
            urls = tbl.column("url").to_pandas().to_numpy()
            vids = tbl.column("vid").to_numpy()
            map_ref = ray.put((urls, vids))
            return links.select_columns(
                ["src_url", "dst_url", *extra]
            ).map_batches(
                functools.partial(_resolve_lookup, map_ref=map_ref, extra=extra),
                batch_format="pyarrow",
            )
    if num_partitions is None:
        num_partitions = _default_join_partitions()
    e = safe_join(
        links,
        vertices,
        join_type="inner",
        num_partitions=num_partitions,
        on=("src_url",),
        right_on=("url",),
    ).rename_columns({"vid": "src"})
    e = e.select_columns(["src", "dst_url", *extra])
    e = safe_join(
        e,
        vertices,
        join_type="inner",
        num_partitions=num_partitions,
        on=("dst_url",),
        right_on=("url",),
    ).rename_columns({"vid": "dst"})
    return e.select_columns(["src", "dst", *extra])


def dedup_edges(edges: rd.Dataset, num_buckets: int | None = None) -> rd.Dataset:
    """Exact (src, dst) dedup — bucketed hash shuffle + vectorized
    per-bucket drop_duplicates (A10)."""
    from parallel_pagerank_ray.stages.agg import distinct

    return distinct(edges, ["src", "dst"], num_buckets=num_buckets)


def out_degrees(edges: rd.Dataset, num_buckets: int | None = None) -> rd.Dataset:
    """(vid, out_deg) for vids that have at least one out-edge."""
    from parallel_pagerank_ray.stages.agg import grouped_agg

    return grouped_agg(
        edges, ["src"], {"out_deg": ("dst", "count")}, num_buckets=num_buckets
    ).rename_columns({"src": "vid"})


def undirected_edges(edges: rd.Dataset, dedup: bool = True) -> rd.Dataset:
    """Symmetric closure without self-loops (CC/LPA input).

    ``dedup=True`` (the default) removes the (u,v)/(v,u) duplicates the
    closure creates when both directions exist in the directed input —
    required by consumers that count edges (LPA vote tallies, degree
    stats). Consumers that are duplicate-INVARIANT (connected-components
    min-propagation: ``min`` over a multiset equals ``min`` over its
    support) pass ``dedup=False`` and skip an entire all-to-all shuffle
    of the doubled edge table — at 10M vertices / 200M closure rows the
    dedup pass is the single most expensive phase of the CC pipeline.
    """

    def swap(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column("dst"), "dst": t.column("src")})

    def drop_self(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.invert(pc.equal(t.column("src"), t.column("dst"))))

    sym = edges.union(edges.map_batches(swap, batch_format="pyarrow"))
    sym = sym.map_batches(drop_self, batch_format="pyarrow")
    return dedup_edges(sym) if dedup else sym


@dataclass
class Graph:
    """A built graph: materialized deduplicated int edges + vertex count.

    ``vertices`` (url<->vid) is present only when built from pages/links.
    """

    n: int
    edges: rd.Dataset
    vertices: rd.Dataset | None = None

    @classmethod
    def from_int_edges(cls, edges: rd.Dataset, dedup: bool = True) -> "Graph":
        """Reference semantics: N = max node id + 1 (csr_graph.c:27);
        ids not present in the file are isolated dangling vertices."""
        if dedup:
            try:
                weighted = "w" in (edges.schema().names or [])
            except Exception:
                weighted = False
            if weighted:
                # the (src, dst) dedup would silently DROP the weight
                # column; a weighted table is the caller's final edge
                # set (or needs an explicit weight-combining rule)
                raise ValueError(
                    "weighted edge table: pass dedup=False (the (src, "
                    "dst) dedup would drop the w column)"
                )
            edges = dedup_edges(edges)
        edges = edges.materialize()
        if edges.count() == 0:
            return cls(n=0, edges=edges)
        from parallel_pagerank_ray.stages.agg import global_agg

        m = global_agg(
            edges, {"ms": ("src", "max"), "md": ("dst", "max")}
        )
        n = int(max(m["ms"], m["md"])) + 1
        return cls(n=n, edges=edges)

    @classmethod
    def from_links(
        cls,
        links: rd.Dataset,
        num_buckets: int = 64,
        num_partitions: int | None = None,
    ) -> "Graph":
        links = links.materialize()
        if links.count() == 0:
            empty = pa.table(
                {
                    "src": pa.array([], type=pa.int64()),
                    "dst": pa.array([], type=pa.int64()),
                }
            )
            return cls(n=0, edges=rd.from_arrow(empty), vertices=None)
        vertices = assign_vertex_ids(links, num_buckets=num_buckets).materialize()
        n = vertices.count()
        edges = dedup_edges(
            resolve_edges(links, vertices, num_partitions=num_partitions)
        ).materialize()
        return cls(n=n, edges=edges, vertices=vertices)

    @classmethod
    def from_pages(
        cls,
        pages: rd.Dataset,
        concurrency: int | None = None,
        num_buckets: int = 64,
        num_partitions: int | None = None,
    ) -> "Graph":
        # concurrency=None lets the extraction stage use every CPU — a
        # fixed cap here silently serialized the whole ingest at high
        # core counts (round-2 scaling run: 32 CPUs no faster than 8)
        return cls.from_links(
            links_from_pages(pages, concurrency=concurrency),
            num_buckets=num_buckets,
            num_partitions=num_partitions,
        )

    def write(self, workdir: str) -> None:
        """Persist the built graph as partitioned Parquet + meta.json —
        the resumable ingest artifact (a failed downstream run reloads
        this instead of re-extracting)."""
        import json
        import os

        os.makedirs(workdir, exist_ok=True)
        self.edges.write_parquet(os.path.join(workdir, "edges"))
        if self.vertices is not None:
            self.vertices.write_parquet(os.path.join(workdir, "vertices"))
        tmp = os.path.join(workdir, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"n": self.n, "has_vertices": self.vertices is not None}, f)
        os.replace(tmp, os.path.join(workdir, "meta.json"))

    @classmethod
    def load(cls, workdir: str) -> "Graph":
        import json
        import os

        with open(os.path.join(workdir, "meta.json")) as f:
            meta = json.load(f)
        edges = rd.read_parquet(os.path.join(workdir, "edges"))
        vertices = (
            rd.read_parquet(os.path.join(workdir, "vertices"))
            if meta.get("has_vertices")
            else None
        )
        return cls(n=int(meta["n"]), edges=edges, vertices=vertices)

    def init_vertex_table(self, num_parts: int | None = None) -> rd.Dataset:
        """(vid, out_deg) for EVERY vid 0..n-1 (dangling rows have 0).

        Uses range(n) ⋈ degrees left-outer so isolated ids (present in
        neither src nor dst of any edge after dedup) still get rows —
        mirrors the reference treating gaps in the id space as real
        dangling nodes (csr_graph.c:27). ``num_parts`` controls the join
        partition count (= downstream scatter parallelism).
        """
        deg = out_degrees(self.edges)
        allv = rd.range(self.n).rename_columns({"id": "vid"})
        if num_parts is None:
            num_parts = max(2, min(64, math.ceil(self.n / 500_000)))
        joined = safe_join(
            allv,
            deg,
            join_type="left_outer",
            num_partitions=num_parts,
            on=("vid",),
        )

        def fill(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            d = pc.fill_null(pc.cast(t.column("out_deg"), pa.int64()), 0)
            return pa.table({"vid": t.column("vid"), "out_deg": d})

        return joined.map_batches(fill, batch_format="pyarrow")


def degree_assortativity_stats(
    edges: rd.Dataset, n: int, num_buckets: int | None = None
) -> rd.Dataset:
    """Integer sufficient statistics for the degree assortativity of a
    simple undirected graph given as CANONICAL edges (src < dst,
    distinct, no self loops). One row:

        m2      directed closure size (2 x edge count)
        sum_x   sum over ordered edge ends of deg(src)
        sum_xy  sum of deg(src) * deg(dst)
        sum_x2  sum of deg(src)^2

    (The closure is symmetric, so sum_y == sum_x and sum_y2 == sum_x2.)
    Pearson r = (sum_xy/m2 - (sum_x/m2)^2) / (sum_x2/m2 - (sum_x/m2)^2)
    is one driver-side division away — kept OUT of the operator so the
    distributed output stays int64-exact and value-checkable (the
    driver-gate float policy).

    Degrees ship as ONE broadcast vector (n * 8 B in plasma, read
    zero-copy per task) when they fit; beyond ``_DEG_BCAST_MAX`` the
    caller should join a degree table instead (same pattern as
    pipelines/triangles.py's two-sided degree join).
    """
    import ray as _ray

    from parallel_pagerank_ray.stages.agg import global_agg, grouped_agg

    _DEG_BCAST_MAX = 256 << 20
    if n * 8 > _DEG_BCAST_MAX:
        raise ValueError(
            "degree vector too large to broadcast; use the join-based "
            "degree attach (triangles.py) and sum the same statistics"
        )

    def both_dirs(t: pa.Table) -> pa.Table:
        v = pa.concat_arrays(
            [t.column("src").combine_chunks(), t.column("dst").combine_chunks()]
        )
        return pa.table({"vid": v})

    deg = grouped_agg(
        edges.map_batches(both_dirs, batch_format="pyarrow"),
        ["vid"],
        {"deg": ("vid", "count")},
        num_buckets=num_buckets,
    )
    deg_vec = np.zeros(n, dtype=np.int64)
    for blk in _ray.get(deg.materialize().to_arrow_refs()):
        deg_vec[blk.column("vid").to_numpy()] = blk.column("deg").to_numpy()
    deg_ref = _ray.put(deg_vec)

    def stats(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        dv = _ray.get(deg_ref)
        x = dv[b["src"]]
        y = dv[b["dst"]]
        one = np.array([0], dtype=np.int64)
        return {
            "m2": one + 2 * len(x),
            "sum_x": one + int(x.sum() + y.sum()),
            "sum_xy": one + 2 * int((x * y).sum()),
            "sum_x2": one + int((x * x).sum() + (y * y).sum()),
        }

    partials = edges.map_batches(stats, batch_format="numpy")
    row = global_agg(
        partials,
        {
            "m2": ("m2", "sum"),
            "sum_x": ("sum_x", "sum"),
            "sum_xy": ("sum_xy", "sum"),
            "sum_x2": ("sum_x2", "sum"),
        },
    )
    return rd.from_arrow(
        pa.table({k: pa.array([int(row[k])], type=pa.int64()) for k in
                  ("m2", "sum_x", "sum_xy", "sum_x2")})
    )


def edge_reciprocity(
    edges: rd.Dataset, num_buckets: int | None = None
) -> rd.Dataset:
    """Reciprocity of a DISTINCT directed edge table: one row
    ``(n_edges, n_reciprocal, reciprocity)`` — the fraction of
    non-self edges (u, v) whose reverse (v, u) also exists (the
    standard directed-webgraph mutual-linking statistic).

    Shape: canonicalize each edge to (lo, hi, dir-bit), ONE bucketed
    combine sums the dir-bits per unordered pair (distinct input =>
    sums are exactly 1, 2, or 3; 3 = reciprocal), then O(1) integer
    partials fold driver-side. ``reciprocity`` is one IEEE division of
    exact-int operands — bit-reproducible at any parallelism.
    """
    from parallel_pagerank_ray.stages.agg import global_agg, grouped_agg

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").combine_chunks().to_numpy(zero_copy_only=False)
        d = t.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
        m = s != d
        s, d = s[m], d[m]
        fwd = s < d
        return pa.table(
            {
                "lo": np.where(fwd, s, d),
                "hi": np.where(fwd, d, s),
                "dir": np.where(fwd, np.int64(1), np.int64(2)),
            }
        )

    pairs = grouped_agg(
        edges.select_columns(["src", "dst"]).map_batches(
            canon, batch_format="pyarrow"
        ),
        ["lo", "hi"],
        {"dirs": ("dir", "sum")},
        num_buckets=num_buckets,
    )

    def partial(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        dirs = b["dirs"]
        recip = dirs == 3
        one = np.array([0], dtype=np.int64)
        return {
            "n_edges": one + int(np.where(recip, 2, 1).sum()) if len(dirs)
            else one,
            "n_reciprocal": one + 2 * int(recip.sum()),
        }

    row = global_agg(
        pairs.map_batches(partial, batch_format="numpy"),
        {"n_edges": ("n_edges", "sum"), "n_reciprocal": ("n_reciprocal", "sum")},
    )
    ne, nr = int(row["n_edges"]), int(row["n_reciprocal"])
    return rd.from_arrow(
        pa.table(
            {
                "n_edges": pa.array([ne], type=pa.int64()),
                "n_reciprocal": pa.array([nr], type=pa.int64()),
                "reciprocity": pa.array(
                    [float(nr) / float(ne) if ne else 0.0], type=pa.float64()
                ),
            }
        )
    )


def attribute_mixing(
    links: rd.Dataset,
    attrs: rd.Dataset,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    key_col: str = "url",
    attr_col: str = "lang",
    num_partitions: int | None = None,
    num_buckets: int | None = None,
    broadcast_max: int = 5_000_000,
) -> rd.Dataset:
    """Attribute mixing matrix of a link graph (Newman 2003 homophily
    analysis): edge counts grouped by the (source attribute, target
    attribute) pair — e.g. which languages link to which. The raw
    matrix is the exact sufficient statistic; assortativity
    coefficients are a driver-side fold over its <= |attr|^2 rows.

    Scale shape: two hash joins attaching the attribute to each
    endpoint (the url->attr side is the page table projected to two
    columns) + one bucketed count — all O(E) row movement, no
    materialized n^2 anything.
    """
    from parallel_pagerank_ray.stages.agg import grouped_agg
    from parallel_pagerank_ray.util import safe_join

    if num_partitions is None:
        num_partitions = _default_join_partitions()
    # identity Arrow pass: pandas-origin blocks break Ray's fused
    # Project/rename on join sides (rename_columns on a DataFrame)
    attrs = (
        attrs.select_columns([key_col, attr_col])
        .map_batches(lambda t: t, batch_format="pyarrow")
        .materialize()
    )

    # Broadcast fast path: the key->attr table is the page table
    # projected to two columns — one plasma copy under the guard, and
    # both endpoint attributes resolve in ONE stateless map via Arrow's
    # index_in/take kernels (inner-join semantics: rows with an
    # unresolved endpoint drop). Beyond the guard: the two hash joins
    # below.
    if attrs.count() <= broadcast_max:
        import pyarrow as pa
        import pyarrow.compute as pc

        blocks = [t for t in ray.get(attrs.to_arrow_refs()) if t.num_rows]
        keys = pa.concat_arrays(
            [t.column(key_col).combine_chunks().cast(pa.large_string()) for t in blocks]
        ) if blocks else pa.array([], pa.large_string())
        vals = pa.concat_arrays(
            [t.column(attr_col).combine_chunks().cast(pa.large_string()) for t in blocks]
        ) if blocks else pa.array([], pa.large_string())
        attr_ref = ray.put((keys, vals))

        def resolve(t: pa.Table) -> pa.Table:
            k, v = ray.get(attr_ref)
            i1 = pc.index_in(
                t.column(src_col).combine_chunks().cast(pa.large_string()),
                value_set=k,
            )
            i2 = pc.index_in(
                t.column(dst_col).combine_chunks().cast(pa.large_string()),
                value_set=k,
            )
            ok = pc.and_(pc.is_valid(i1), pc.is_valid(i2))
            return pa.table(
                {
                    "src_attr": pc.take(v, pc.filter(i1, ok)),
                    "dst_attr": pc.take(v, pc.filter(i2, ok)),
                }
            )

        return grouped_agg(
            links.select_columns([src_col, dst_col]).map_batches(
                resolve, batch_format="pyarrow"
            ),
            ["src_attr", "dst_attr"],
            {"n": ("src_attr", "count")},
            num_buckets=num_buckets,
        )

    j = safe_join(
        links.select_columns([src_col, dst_col]),
        attrs.rename_columns({key_col: "__k1", attr_col: "src_attr"}),
        join_type="inner",
        num_partitions=num_partitions,
        on=(src_col,),
        right_on=("__k1",),
    )
    j = safe_join(
        j,
        attrs.rename_columns({key_col: "__k2", attr_col: "dst_attr"}),
        join_type="inner",
        num_partitions=num_partitions,
        on=(dst_col,),
        right_on=("__k2",),
    )
    return grouped_agg(
        j.select_columns(["src_attr", "dst_attr"]),
        ["src_attr", "dst_attr"],
        {"n": ("src_attr", "count")},
        num_buckets=num_buckets,
    )


def joint_degree_matrix(
    edges: rd.Dataset, num_buckets: int | None = None
) -> rd.Dataset:
    """Joint degree distribution of the undirected simple graph in
    power-of-two bands: one row per unordered band pair with the edge
    count — the assortativity profile a crawl-graph report leads with.
    Output (band_lo, band_hi, n_edges), band = floor(log2(degree))
    computed in INTEGER arithmetic (a power-boundary searchsorted, not
    float log2 — libm rounding can't flip a boundary).

    ``edges`` must be canonical simple (src < dst, distinct). Scale
    shape: one degree combine, two degree attaches on the canonical
    edge table, one tiny band-pair combine.
    """
    from parallel_pagerank_ray.stages.agg import grouped_agg, resolve_num_buckets
    from parallel_pagerank_ray.util import safe_join

    if num_buckets is None:
        num_buckets = resolve_num_buckets(edges)
    edges = edges.select_columns(["src", "dst"]).materialize()
    deg = grouped_agg(
        undirected_edges(edges, dedup=False),
        ["src"],
        {"deg": ("dst", "count")},
        num_buckets=num_buckets,
    )
    pows = np.int64(2) ** np.arange(62, dtype=np.int64)

    def banded(t: pa.Table) -> pa.Table:
        d = t.column("deg").to_numpy(zero_copy_only=False)
        band = np.searchsorted(pows, d, side="right") - 1
        return pa.table(
            {
                "vid": t.column("src"),
                "band": pa.array(band.astype(np.int64), pa.int64()),
            }
        )

    bands = deg.map_batches(banded, batch_format="pyarrow").materialize()

    # broadcast the band vector when it fits (one plasma copy, indexed
    # zero-copy per task) — replaces TWO hash-shuffle attaches of the
    # full edge table with one stateless map; join path = fallback
    from parallel_pagerank_ray.util import count_rows_once

    n_bands, bands = count_rows_once(bands)
    if n_bands <= 32_000_000:
        import ray as _ray

        bt = pa.concat_tables(_ray.get(bands.to_arrow_refs()))
        vids = bt.column("vid").to_numpy(zero_copy_only=False)
        n = int(vids.max()) + 1 if len(vids) else 0
        if n > (256 << 20):  # sparse 64-bit ids: dense int8 vector too big
            n = -1
    else:
        n = -1
    if n >= 0:
        import ray as _ray

        vec = np.full(n, -1, dtype=np.int8)
        vec[vids] = bt.column("band").to_numpy(zero_copy_only=False)
        ref = _ray.put(vec)

        def pair_rows_bcast(t: pa.Table) -> pa.Table:
            v = _ray.get(ref)
            a = v[t.column("src").to_numpy(zero_copy_only=False)].astype(
                np.int64
            )
            b = v[t.column("dst").to_numpy(zero_copy_only=False)].astype(
                np.int64
            )
            return pa.table(
                {
                    "band_lo": pa.array(np.minimum(a, b), pa.int64()),
                    "band_hi": pa.array(np.maximum(a, b), pa.int64()),
                    "one": pa.array(np.ones(len(a), np.int64), pa.int64()),
                }
            )

        return grouped_agg(
            edges.map_batches(pair_rows_bcast, batch_format="pyarrow"),
            ["band_lo", "band_hi"],
            {"n_edges": ("one", "sum")},
            num_buckets=8,
        )

    j1 = safe_join(
        edges,
        bands.rename_columns({"vid": "__u", "band": "ba"}),
        join_type="inner",
        num_partitions=8,
        on=("src",),
        right_on=("__u",),
    )
    j2 = safe_join(
        j1,
        bands.rename_columns({"vid": "__v", "band": "bb"}),
        join_type="inner",
        num_partitions=8,
        on=("dst",),
        right_on=("__v",),
    )

    def pair_rows(t: pa.Table) -> pa.Table:
        a = t.column("ba").to_numpy(zero_copy_only=False)
        b = t.column("bb").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "band_lo": pa.array(np.minimum(a, b), pa.int64()),
                "band_hi": pa.array(np.maximum(a, b), pa.int64()),
                "one": pa.array(np.ones(len(a), np.int64), pa.int64()),
            }
        )

    return grouped_agg(
        j2.map_batches(pair_rows, batch_format="pyarrow"),
        ["band_lo", "band_hi"],
        {"n_edges": ("one", "sum")},
        num_buckets=8,
    )
