"""Redirect-chain resolution over a crawled pages table.

Beyond-reference capability (the reference crawls no redirects; its
ingest surface is the static edge list, csr_graph.c:20-27). Real web
corpora are full of moved pages: a crawler must follow each redirect
chain to its terminal url (with a hop cap — every production crawler
bounds chains, e.g. curl's --max-redirs) before link-graph
construction, or the graph splits one logical page across aliases.

The redirect relation here is a FUNCTION url -> target (at most one
outgoing redirect per page), so resolution is a functional-graph
pointer chase:

    map      f = {url -> first extracted href} restricted to the
               deterministically sampled "moved" pages
               (md5_u64(url) mod 5 == 0 — the SQL-reproducible md5
               pattern of functions/hashing.py)
    resolve  follow f up to ``max_hops`` times; a chain that still
               sits on a redirecting page after the cap is flagged
               ``unresolved`` (loop or over-long chain), everything
               else ``resolved`` at its terminal url

Scale shape: the redirect map is a stateless filter+extract map over
pages (html never leaves the stage); each resolution round is ONE
partitioned hash join of the surviving frontier against the map, and
the frontier shrinks by the redirect fraction (~5x here) every round —
total join traffic is a geometric series in the map size, never the
corpus. No driver materialization; the hop cap bounds rounds at
``max_hops`` regardless of cycles.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from parallel_pagerank_ray.functions.hashing import md5_u64

REDIRECT_MOD = 5  # url-hash sampling: md5_u64(url) % 5 == 0 redirects

_HREF = re.compile(r'<a\s+href="([^"]+)"', re.IGNORECASE)


def redirect_map(pages: rd.Dataset) -> rd.Dataset:
    """(url, target) redirect rows: the deterministically sampled
    "moved" pages pointing at their first extracted href. Pages with
    no href never redirect. One stateless map over (url, html)."""

    def first_href(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        htmls = t.column("html").to_pylist()
        out_u: list[str] = []
        out_t: list[str] = []
        for u, h in zip(urls, htmls):
            if md5_u64(u) % REDIRECT_MOD != 0:
                continue
            if isinstance(h, bytes):
                h = h.decode("utf-8", errors="replace")
            m = _HREF.search(h or "")
            if m:
                out_u.append(u)
                out_t.append(m.group(1))
        return pa.table(
            {
                "url": pa.array(out_u, type=pa.string()),
                "target": pa.array(out_t, type=pa.string()),
            }
        )

    return pages.select_columns(["url", "html"]).map_batches(
        first_href, batch_format="pyarrow"
    )


def resolve_redirects(
    pages: rd.Dataset,
    max_hops: int = 8,
    num_partitions: int | None = None,
    broadcast_max: int = 5_000_000,
) -> rd.Dataset:
    """One row per redirecting page: (url, final_url, hops, status).

    ``hops`` = redirects followed to reach ``final_url`` (>= 1);
    ``status`` = 'resolved' when ``final_url`` does not itself redirect,
    'unresolved' when the chain still sits on a redirecting page after
    ``max_hops`` follows (cycle or over-long chain). Deterministic and
    value-exact vs the DuckDB recursive-CTE oracle in __ray_entry__.
    """
    from parallel_pagerank_ray.pipelines.graph_build import (
        _default_join_partitions,
    )
    from parallel_pagerank_ray.util import count_rows_once, safe_join

    if max_hops < 1:
        raise ValueError("resolve_redirects needs max_hops >= 1")
    if num_partitions is None:
        num_partitions = _default_join_partitions()

    fmap = redirect_map(pages).materialize()

    # broadcast fast path: redirect maps are a small fraction of the
    # corpus by nature; while the map fits the guard, ship it once via
    # ray.put (sorted url array + aligned targets) and chase all
    # max_hops inside ONE stateless map over the map's own rows —
    # zero joins, zero extra passes. Beyond the guard the join loop
    # below is the same semantics (tested by shrinking the guard).
    from parallel_pagerank_ray.util import count_rows_once

    n_map, fmap = count_rows_once(fmap)
    if n_map <= broadcast_max:
        import ray

        tbls = [t for t in ray.get(fmap.to_arrow_refs()) if t.num_rows]
        if not tbls:
            return fmap.map_batches(
                lambda t: pa.table(
                    {
                        "url": pa.array([], pa.string()),
                        "final_url": pa.array([], pa.string()),
                        "hops": pa.array([], pa.int64()),
                        "status": pa.array([], pa.string()),
                    }
                ),
                batch_format="pyarrow",
            )
        urls = np.concatenate(
            [t.column("url").to_numpy(zero_copy_only=False) for t in tbls]
        )
        tgts = np.concatenate(
            [t.column("target").to_numpy(zero_copy_only=False) for t in tbls]
        )
        order = np.argsort(urls)
        map_ref = ray.put((urls[order], tgts[order]))

        def chase(t: pa.Table) -> pa.Table:
            keys, vals = ray.get(map_ref)

            def lookup(cur: np.ndarray) -> np.ndarray:
                idx = np.searchsorted(keys, cur)
                idx = np.clip(idx, 0, len(keys) - 1)
                hit = keys[idx] == cur
                return hit, idx

            url = t.column("url").to_numpy(zero_copy_only=False)
            cur = t.column("target").to_numpy(zero_copy_only=False).copy()
            hops = np.ones(len(url), dtype=np.int64)
            active = np.ones(len(url), dtype=bool)
            for _ in range(1, max_hops):
                hit, idx = lookup(cur[active])
                if not hit.any():
                    break
                sel = np.nonzero(active)[0][hit]
                cur[sel] = vals[idx[hit]]
                hops[sel] += 1
                nxt = np.zeros(len(url), dtype=bool)
                nxt[sel] = True
                active = nxt
            still, _ = lookup(cur)
            status = np.where(
                (hops >= max_hops) & still, "unresolved", "resolved"
            )
            return pa.table(
                {
                    "url": pa.array(url, pa.string()),
                    "final_url": pa.array(cur, pa.string()),
                    "hops": pa.array(hops, pa.int64()),
                    "status": pa.array(status, pa.string()),
                }
            )

        return fmap.map_batches(chase, batch_format="pyarrow")

    def _final(t: pa.Table, hops: int, status_by_member: bool) -> pa.Table:
        n = t.num_rows
        if status_by_member:
            member = pc.is_valid(t.column("__t"))
            status = pc.if_else(
                member,
                pa.scalar("unresolved", pa.string()),
                pa.scalar("resolved", pa.string()),
            )
        else:
            status = pa.array(["resolved"] * n, type=pa.string())
        return pa.table(
            {
                "url": t.column("url"),
                "final_url": t.column("cur"),
                "hops": pa.array(np.full(n, hops, dtype=np.int64)),
                "status": status,
            }
        )

    frontier = fmap.map_batches(
        lambda t: pa.table(
            {"url": t.column("url"), "cur": t.column("target")}
        ),
        batch_format="pyarrow",
    )
    finals: list[rd.Dataset] = []
    lookup = fmap.map_batches(
        lambda t: pa.table({"__u": t.column("url"), "__t": t.column("target")}),
        batch_format="pyarrow",
    )
    for hops in range(1, max_hops + 1):
        j = safe_join(
            frontier,
            lookup,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("cur",),
            right_on=("__u",),
        ).materialize()
        if hops == max_hops:
            # cap reached: whatever still redirects is unresolved
            finals.append(
                j.map_batches(
                    lambda t, h=hops: _final(t, h, status_by_member=True),
                    batch_format="pyarrow",
                )
            )
            break
        done = j.map_batches(
            lambda t, h=hops: _final(
                t.filter(pc.is_null(t.column("__t"))), h, False
            ),
            batch_format="pyarrow",
        )
        finals.append(done)
        frontier = j.map_batches(
            lambda t: (
                lambda f: pa.table(
                    {"url": f.column("url"), "cur": f.column("__t")}
                )
            )(t.filter(pc.is_valid(t.column("__t")))),
            batch_format="pyarrow",
        )
        remaining, frontier = count_rows_once(frontier)
        if remaining == 0:
            break
    out = finals[0]
    for d in finals[1:]:
        out = out.union(d)
    return out
