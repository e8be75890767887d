"""Redirect resolution — chains, terminals, cycles, hop cap."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.pipelines import redirects as R


def _pages(rows: dict[str, str | None]) -> rd.Dataset:
    urls = list(rows)
    htmls = [
        (f'<html><body><a href="{t}">x</a></body></html>' if t else "<html/>")
        .encode()
        for t in rows.values()
    ]
    return rd.from_arrow(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": pa.array(htmls, pa.binary()),
            }
        )
    )


def _chase(rows: dict[str, str | None], max_hops: int) -> dict[str, tuple]:
    f = {u: t for u, t in rows.items() if t}
    out = {}
    for u, t in f.items():
        cur, hops = t, 1
        while hops < max_hops and cur in f:
            cur, hops = f[cur], hops + 1
        status = "unresolved" if (hops >= max_hops and cur in f) else "resolved"
        out[u] = (cur, hops, status)
    return out


def test_resolve_chains_cycles_and_cap(monkeypatch):
    monkeypatch.setattr(R, "REDIRECT_MOD", 1)  # every page with an href moves
    rows = {
        "u0": "u1",  # 2-hop chain -> u2 (terminal: no href)
        "u1": "u2",
        "u2": None,
        "u3": "u3",  # self-loop -> unresolved at cap
        "u4": "u5",  # 2-cycle -> unresolved at cap
        "u5": "u4",
        "u6": "u2",  # direct hit on a terminal
    }
    for cap in (1, 2, 8):
        for bmax in (5_000_000, 0):  # broadcast fast path AND join loop
            got = R.resolve_redirects(
                _pages(rows), max_hops=cap, broadcast_max=bmax
            ).to_pandas()
            want = _chase(rows, cap)
            assert len(got) == len(want)
            for r in got.itertuples():
                assert want[r.url] == (r.final_url, r.hops, r.status), (
                    r.url,
                    cap,
                    bmax,
                )


def test_redirect_map_samples_by_url_hash():
    from parallel_pagerank_ray.functions.hashing import md5_u64

    rows = {f"page{i}": "pageX" for i in range(40)}
    rows["pageX"] = None
    m = R.redirect_map(_pages(rows)).to_pandas()
    want = {
        u for u, t in rows.items() if t and md5_u64(u) % R.REDIRECT_MOD == 0
    }
    assert set(m["url"]) == want
    assert (m["target"] == "pageX").all()
