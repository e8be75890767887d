"""Host-level graph coarsening: page links -> weighted host graph.

Beyond-reference capability modeled on the standard Common-Crawl host/
domain-level webgraph product: aggregate the page-level link table to
one weighted edge per (src_host, dst_host) and run the graph suite on
the ~10^8-vertex host graph instead of the 10^12-vertex page graph.
The reference has no URL handling at all (it consumes integer edge
lists, /root/reference/pagerank_mpi/csr_graph.c:4-61).

Shapes at scale: the host projection is a stateless vectorized map
(no Python per row); the rollup is one bucketed shuffle whose volume
is the number of DISTINCT host pairs per batch (map-side combine),
orders of magnitude below the link count; vid assignment + resolution
reuse the page-graph machinery (broadcast fast path for small host
sets, hash-join fallback for unbounded ones).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import (
    Graph,
    assign_vertex_ids,
    resolve_edges,
)
from parallel_pagerank_ray.stages.agg import grouped_agg


def host_of(urls: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized url -> host: the authority component of a
    ``scheme://host/path`` url; empty string for urls without an
    authority part (mailto:, javascript:, tel:, relative refs — link
    extraction passes non-hierarchical hrefs through verbatim, so real
    crawl link tables contain them). Arrow kernels only."""
    ex = pc.extract_regex(urls, r"^[A-Za-z][A-Za-z0-9+.\-]*://(?P<host>[^/]*)")
    return pc.fill_null(pc.struct_field(ex, "host"), "")


def host_links(links: rd.Dataset) -> rd.Dataset:
    """(src_url, dst_url) -> (src_host, dst_host), stateless map."""

    def to_hosts(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src_host": host_of(t.column("src_url")),
                "dst_host": host_of(t.column("dst_url")),
            }
        )

    return links.map_batches(to_hosts, batch_format="pyarrow")


def host_edges(
    links: rd.Dataset,
    drop_self: bool = False,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Weighted host edge table (src_host, dst_host, w) where w is the
    page-link count behind the host pair. ``drop_self`` removes
    intra-host edges (dominant in real crawls and meaningless for
    endorsement-style scoring)."""
    hl = host_links(links)
    if drop_self:
        hl = hl.map_batches(
            lambda t: t.filter(
                pc.invert(pc.equal(t.column("src_host"), t.column("dst_host")))
            ),
            batch_format="pyarrow",
        )
    return grouped_agg(
        hl,
        ["src_host", "dst_host"],
        {"w": ("dst_host", "count")},
        num_buckets=num_buckets,
    )


def host_crawl_rollup(
    pages: rd.Dataset,
    fmt: str = "%Y-%m-%d %H:%M",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Crawl-log rollup: pages per (host, capture window) —
    (host, bucket_ts, n_pages). The window key is ``warc_ts`` formatted
    with ``fmt`` (string timestamps on both sides per the float/ts
    policy); projection is pure Arrow kernels, then one bucketed count
    shuffle. The shape every crawl-ops dashboard needs at 100 TB: rows
    after the map-side combine are one per (host, window) per batch."""

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": host_of(t.column("url")),
                "bucket_ts": pc.strftime(t.column("warc_ts"), format=fmt),
            }
        )

    keyed = pages.select_columns(["url", "warc_ts"]).map_batches(
        project, batch_format="pyarrow"
    )
    return grouped_agg(
        keyed,
        ["host", "bucket_ts"],
        {"n_pages": ("host", "count")},
        num_buckets=num_buckets,
    )


def host_graph(links: rd.Dataset, drop_self: bool = True) -> Graph:
    """Build the weighted host ``Graph`` from page links. The vertex
    set is the union of hosts appearing in the (optionally
    self-dropped) host edge table — hosts whose every link is
    intra-host vanish when ``drop_self``, mirroring how the vertex set
    of a page graph is the union of linked urls."""
    he = host_edges(links, drop_self=drop_self)
    renamed = he.rename_columns(
        {"src_host": "src_url", "dst_host": "dst_url"}
    ).materialize()
    verts = assign_vertex_ids(renamed).materialize()
    edges = resolve_edges(renamed, verts, extra=("w",)).map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("w"),
            "w",
            pc.cast(t.column("w"), pa.float64()),
        ),
        batch_format="pyarrow",
    )
    return Graph(n=verts.count(), edges=edges.materialize(), vertices=verts)


def host_cocitation(
    links: rd.Dataset,
    num_buckets: int | None = None,
    broadcast_max: int = 5_000_000,
) -> rd.Dataset:
    """Related-domain discovery by co-citation: (host_a, host_b, w)
    where w = number of DISTINCT link targets both hosts point at
    (host_a < host_b lexicographically).

    Shape: hosts are dictionary-encoded through the page-graph vid
    machinery (strings never enter the pair kernel), the (src, dst)
    host-pair table is globally deduplicated (a host citing one target
    many times counts once), and pair generation is the bucketed
    in-group kernel keyed on the TARGET — group size = a target's
    citing-host count, the quantity a caller caps when targets are
    pathological hubs (same contract as the co-purchase kernel)."""
    import ray

    from parallel_pagerank_ray.pipelines.graph_build import (
        assign_vertex_ids,
        dedup_edges,
        resolve_edges,
    )
    from parallel_pagerank_ray.stages.agg import (
        grouped_agg,
        pairs_within_groups,
        resolve_num_buckets,
    )

    hl = host_links(links).rename_columns(
        {"src_host": "src_url", "dst_host": "dst_url"}
    ).materialize()
    verts = assign_vertex_ids(hl).materialize()
    pairs_int = dedup_edges(resolve_edges(hl, verts))
    if num_buckets is None:
        num_buckets = resolve_num_buckets(pairs_int)

    def bucketed(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        b["__b"] = (b["dst"] % num_buckets).astype(np.int64)
        return b

    def pairs(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        tgt = g["dst"].to_numpy()
        src = g["src"].to_numpy()
        a, b = pairs_within_groups((tgt, src), src)
        # srcs are distinct within a target (post-dedup) -> a < b always
        out = (
            pd.DataFrame({"a": a, "b": b})
            .groupby(["a", "b"], sort=False)
            .size()
            .reset_index(name="w")
        )
        out["w"] = out["w"].astype(np.int64)
        return out

    counts = grouped_agg(
        pairs_int.map_batches(bucketed, batch_format="numpy")
        .groupby("__b")
        .map_groups(pairs, batch_format="pandas"),
        ["a", "b"],
        {"w": ("w", "sum")},
        num_buckets=num_buckets,
    )
    def normalize(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        ha, hb = df["host_a"], df["host_b"]
        swap = ha > hb  # vid order != lexicographic order
        return pd.DataFrame(
            {
                "host_a": ha.where(~swap, hb),
                "host_b": hb.where(~swap, ha),
                "w": df["w"].astype(np.int64),
            }
        )

    # vid -> host-name attach: broadcast only while the host vertex
    # table is genuinely small-side (<= broadcast_max rows); a crawl
    # has ~10^8 hosts, where the dict would be tens of GB of driver
    # heap — fall back to two hash joins (same resolve_edges contract)
    if verts.count() <= broadcast_max:
        vt = pa.concat_tables(ray.get(verts.to_arrow_refs()))
        host_by_vid = dict(
            zip(vt.column("vid").to_pylist(), vt.column("url").to_pylist())
        )
        names_ref = ray.put(host_by_vid)

        def attach(df: "pd.DataFrame") -> "pd.DataFrame":
            import pandas as pd

            lookup = ray.get(names_ref)
            return normalize(
                pd.DataFrame(
                    {
                        "host_a": df["a"].map(lookup),
                        "host_b": df["b"].map(lookup),
                        "w": df["w"],
                    }
                )
            )

        return counts.map_batches(attach, batch_format="pandas")

    from parallel_pagerank_ray.pipelines.graph_build import (
        _default_join_partitions,
    )
    from parallel_pagerank_ray.util import safe_join

    parts = _default_join_partitions()
    j = safe_join(
        counts, verts, join_type="inner", num_partitions=parts,
        on=("a",), right_on=("vid",),
    ).rename_columns({"url": "host_a"}).select_columns(["host_a", "b", "w"])
    j = safe_join(
        j, verts, join_type="inner", num_partitions=parts,
        on=("b",), right_on=("vid",),
    ).rename_columns({"url": "host_b"}).select_columns(["host_a", "host_b", "w"])
    return j.map_batches(normalize, batch_format="pandas")


def crawl_frontier(
    pages: "rd.Dataset",
    num_buckets: int | None = None,
    broadcast_max: int = 5_000_000,
) -> "rd.Dataset":
    """Politeness-interleaved fetch schedule — the crawl-frontier
    primitive: round-robin the urls over their hosts so any window of
    H consecutive global slots fetches each host at most once.

        pos   = rank of the url within its host (url ascending)
        hrank = rank of the host among the H distinct hosts (ascending)
        slot  = pos * H + hrank

    Output (url, host, pos, slot) — ordering by slot IS the schedule.
    All integer ranks over total string orders: value-exact at any
    parallelism (ASCII urls; byte order on both engines).

    Scale shape: one bucketed shuffle keyed by host (a host's urls are
    co-located, the sessionize contract), segmented C cumcounts per
    bucket; the host-rank side is a distinct + sort, attached per batch
    from one broadcast list under ``broadcast_max`` (hosts ~ 1e6-1e8 at
    crawl scale; past the guard, swap in the sorted-block-offset
    enumeration used by `ppr_push.sweep_cut`).
    """
    import pandas as pd

    from parallel_pagerank_ray.stages.agg import (
        distinct,
        resolve_num_buckets,
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"url": t.column("url"), "host": host_of(t.column("url"))})

    urls = pages.select_columns(["url"]).map_batches(
        project, batch_format="pyarrow"
    ).materialize()
    hosts = (
        distinct(urls.select_columns(["host"]), ["host"])
        .to_pandas()["host"]
        .to_numpy()
    )
    if len(hosts) > broadcast_max:  # pragma: no cover - guard
        raise ValueError(
            "crawl_frontier: host set exceeds broadcast_max; use the "
            "sorted-block-offset rank path (see sweep_cut)"
        )
    hosts = np.sort(hosts)
    big_h = len(hosts)
    num_buckets = num_buckets or resolve_num_buckets(urls)

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        from parallel_pagerank_ray.pipelines.graph_build import stable_bucket

        return df.assign(__b=stable_bucket(df["host"], num_buckets))

    def schedule(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["host", "url"], kind="stable")
        pos = g.groupby("host", sort=False).cumcount().to_numpy()
        hrank = np.searchsorted(hosts, g["host"].to_numpy())
        return pd.DataFrame(
            {
                "url": g["url"].to_numpy(),
                "host": g["host"].to_numpy(),
                "pos": pos.astype(np.int64),
                "slot": (pos * big_h + hrank).astype(np.int64),
            }
        )

    from parallel_pagerank_ray.util import drop_empty_blocks

    return drop_empty_blocks(
        urls.map_batches(keyed, batch_format="pandas")
        .groupby("__b")
        .map_groups(schedule, batch_format="pandas")
    )


def link_churn(
    links_a: rd.Dataset, links_b: rd.Dataset, num_buckets: int | None = None
) -> rd.Dataset:
    """Link churn between two crawl snapshots: per src host, how many
    DISTINCT (src_url, dst_url) links were added (B only), removed
    (A only), or stable (both) -> (host, n_added, n_removed, n_stable).

    The temporal-webgraph primitive (which sites rewired between
    crawls). Scale shape: NO join — each side dedups map-side, the
    union carries (src, dst, a, b) indicator rows, ONE bucketed
    grouped_agg keyed on the edge classifies it, and a second tiny
    grouped_agg rolls up per host. Edges move once.
    """

    def flag(a: int, b: int):
        def inner(t: pa.Table) -> pa.Table:
            one = np.ones(t.num_rows, dtype=np.int64)
            return pa.table(
                {
                    "src_url": t.column("src_url"),
                    "dst_url": t.column("dst_url"),
                    "a": pa.array(one * a, pa.int64()),
                    "b": pa.array(one * b, pa.int64()),
                }
            )

        return inner

    from parallel_pagerank_ray.stages.agg import distinct

    da = distinct(links_a, ["src_url", "dst_url"]).map_batches(
        flag(1, 0), batch_format="pyarrow"
    )
    db = distinct(links_b, ["src_url", "dst_url"]).map_batches(
        flag(0, 1), batch_format="pyarrow"
    )
    edges = grouped_agg(
        da.union(db),
        ["src_url", "dst_url"],
        {"a": ("a", "sum"), "b": ("b", "sum")},
        num_buckets=num_buckets,
    )

    def classify(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "host": host_of(t.column("src_url")),
                "n_added": pa.array(((a == 0) & (b == 1)).astype(np.int64)),
                "n_removed": pa.array(((a == 1) & (b == 0)).astype(np.int64)),
                "n_stable": pa.array(((a == 1) & (b == 1)).astype(np.int64)),
            }
        )

    return grouped_agg(
        edges.map_batches(classify, batch_format="pyarrow"),
        ["host"],
        {
            "n_added": ("n_added", "sum"),
            "n_removed": ("n_removed", "sum"),
            "n_stable": ("n_stable", "sum"),
        },
        num_buckets=num_buckets,
    )


def host_mirror_scores(
    links: rd.Dataset,
    num_partitions: int | None = None,
    broadcast_max: int = 5_000_000,
) -> rd.Dataset:
    """Mirror-site detection: Jaccard similarity of host OUTLINK target
    sets -> (host_a, host_b, inter, union_size, jaccard) for every
    co-citing host pair. Two hosts serving the same content link to
    (nearly) the same targets, so jaccard ~ 1 flags mirrors/aliases
    the way text MinHash flags duplicated documents — this is the
    graph-side of the dedup story.

    Composition: ``host_cocitation`` supplies the intersection
    (distinct shared targets, the bucketed in-group pair kernel); the
    per-host distinct out-target counts attach via two partitioned
    joins; union = |A| + |B| - inter and jaccard = inter / union is a
    single division of exact int64 operands (float policy)."""
    from parallel_pagerank_ray.pipelines.graph_build import (
        _default_join_partitions,
    )
    from parallel_pagerank_ray.stages.agg import distinct, grouped_agg
    from parallel_pagerank_ray.util import safe_join

    if num_partitions is None:
        num_partitions = _default_join_partitions()
    inter = host_cocitation(links)
    hl = distinct(
        host_links(links), ["src_host", "dst_host"]
    )
    sizes = grouped_agg(
        hl, ["src_host"], {"n_out": ("dst_host", "count")}
    )
    # the per-host out-degree table is O(#hosts): broadcast it while
    # it fits the standard guard (both attaches become one map over
    # the co-citation pairs); two hash joins beyond
    from parallel_pagerank_ray.util import count_rows_once

    n_hosts, sizes = count_rows_once(sizes)
    if n_hosts <= broadcast_max:
        import pandas as _pd
        import pyarrow as _pa
        import ray as _ray

        st = _pa.concat_tables(_ray.get(sizes.to_arrow_refs()))
        hidx = _pd.Index(st.column("src_host").to_pylist())
        sizes_ref = _ray.put(
            (hidx, st.column("n_out").to_numpy().astype(np.int64))
        )

        def attach_sizes(df: "pd.DataFrame") -> "pd.DataFrame":
            idx, nout = _ray.get(sizes_ref)
            pa_ = idx.get_indexer(df["host_a"])
            pb_ = idx.get_indexer(df["host_b"])
            m = (pa_ >= 0) & (pb_ >= 0)  # inner-join semantics
            out = df.loc[m, ["host_a", "host_b", "w"]].reset_index(
                drop=True
            )
            out["na"] = nout[pa_[m]]
            out["nb"] = nout[pb_[m]]
            return out

        j = inter.map_batches(attach_sizes, batch_format="pandas")
    else:
        j = safe_join(
            safe_join(
                inter,
                sizes.rename_columns({"src_host": "__ha", "n_out": "na"}),
                join_type="inner",
                num_partitions=num_partitions,
                on=("host_a",),
                right_on=("__ha",),
            ),
            sizes.rename_columns({"src_host": "__hb", "n_out": "nb"}),
            join_type="inner",
            num_partitions=num_partitions,
            on=("host_b",),
            right_on=("__hb",),
        )

    def score(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        inter_v = df["w"].astype(np.int64).to_numpy()
        na = df["na"].astype(np.int64).to_numpy()
        nb = df["nb"].astype(np.int64).to_numpy()
        union = na + nb - inter_v
        return pd.DataFrame(
            {
                "host_a": df["host_a"],
                "host_b": df["host_b"],
                "inter": inter_v,
                "union_size": union,
                "jaccard": inter_v / union,
            }
        )

    return j.map_batches(score, batch_format="pandas")
