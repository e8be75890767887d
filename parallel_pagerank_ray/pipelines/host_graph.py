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
