"""Synthetic page-corpus generation (FIXTURES.md §1) and graph generators.

``pages_table`` turns an edge list into a deterministic Common-Crawl-style
``pages`` Arrow table (url, warc_ts, html, text, lang) whose extracted
links reproduce the edge set exactly — the byte-identity oracle for the
extractor lives in the ``text`` column.

Graph generators mirror the reference dashboard's five topologies
(/root/reference/dashboard/app.py:1454-1499: random(p), Barabási–Albert,
complete, ring, star), re-implemented with a seeded NumPy RNG (seed 42).
These are driver-side fixture builders, not Dataset operators.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa

EPOCH = _dt.datetime(2025, 12, 5, 0, 0, 0)  # FIXTURES.md: deterministic warc_ts base


def page_url(graph_name: str, vid: int) -> str:
    return f"https://{graph_name}.example/p{vid}"


def page_html(
    graph_name: str, vid: int, outlinks: list[str], filler_paras: int = 0
) -> str:
    """Exact HTML template from FIXTURES.md §1 (normative, byte-checkable).

    ``filler_paras`` appends deterministic <p> filler to approximate
    real Common-Crawl page weight (bench corpora only; fixtures use 0).
    """
    anchors = "".join(
        f'<a href="{dst}">link {j}</a>\n' for j, dst in enumerate(outlinks)
    )
    filler = "".join(
        f"<p>para {k} of page {vid} " + "lorem ipsum dolor sit amet " * 5 + "</p>\n"
        for k in range(filler_paras)
    )
    return (
        f"<html><head><title>page {vid}</title></head><body>\n"
        f"<p>doc {vid} of graph {graph_name}</p>\n"
        f"{filler}"
        f"{anchors}"
        f"</body></html>"
    )


def page_text(graph_name: str, vid: int, n_links: int) -> str:
    """Expected extractor output for the template above."""
    parts = [f"page {vid}", f"doc {vid} of graph {graph_name}"]
    parts += [f"link {j}" for j in range(n_links)]
    return "\n".join(parts)


def pages_table(
    graph_name: str, n: int, edges: np.ndarray | list, filler_paras: int = 0
) -> pa.Table:
    """Build the pages table for a graph: one row per vertex 0..n-1.

    Outlink order per page = edge-list order within each src (mirrors the
    reference keeping file order per source, csr_graph.c:52-56).
    """
    out: list[list[str]] = [[] for _ in range(n)]
    for u, v in np.asarray(edges, dtype=np.int64).reshape(-1, 2):
        out[int(u)].append(page_url(graph_name, int(v)))
    urls, tss, htmls, texts = [], [], [], []
    for vid in range(n):
        urls.append(page_url(graph_name, vid))
        tss.append(EPOCH + _dt.timedelta(seconds=vid))
        htmls.append(
            page_html(graph_name, vid, out[vid], filler_paras).encode("utf-8")
        )
        texts.append(page_text(graph_name, vid, len(out[vid])))
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * n, type=pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# Graph generators (reference dashboard topologies, app.py:1454-1499)
# ---------------------------------------------------------------------------


def random_graph(n: int, p: float, seed: int = 42) -> np.ndarray:
    """Directed G(n,p); each ordered pair (i,j), i != j, kept with prob p."""
    rng = np.random.default_rng(seed)
    mat = rng.random((n, n)) < p
    np.fill_diagonal(mat, False)
    src, dst = np.nonzero(mat)
    return np.stack([src, dst], axis=1).astype(np.int64)

def barabasi_albert(n: int, m: int = 3, seed: int = 42) -> np.ndarray:
    """BA preferential attachment; each new node attaches to m targets,
    edges added in both directions (as the dashboard does, app.py:1464-1471)."""
    rng = np.random.default_rng(seed)
    targets = list(range(m))
    repeated: list[int] = list(range(m))
    edges: list[tuple[int, int]] = []
    for v in range(m, n):
        chosen = set()
        while len(chosen) < min(m, len(set(repeated))):
            chosen.add(repeated[rng.integers(0, len(repeated))])
        for t in chosen:
            edges.append((v, t))
            edges.append((t, v))
            repeated.append(t)
        repeated.extend([v] * len(chosen))
    del targets
    return np.array(edges, dtype=np.int64).reshape(-1, 2)

def complete_graph(n: int) -> np.ndarray:
    src, dst = np.nonzero(~np.eye(n, dtype=bool))
    return np.stack([src, dst], axis=1).astype(np.int64)

def ring_graph(n: int) -> np.ndarray:
    src = np.arange(n, dtype=np.int64)
    return np.stack([src, (src + 1) % n], axis=1)

def star_graph(n: int) -> np.ndarray:
    """Hub 0 <-> every other vertex (worst-case dst skew for the gather)."""
    others = np.arange(1, n, dtype=np.int64)
    zeros = np.zeros(n - 1, dtype=np.int64)
    return np.concatenate(
        [np.stack([zeros, others], axis=1), np.stack([others, zeros], axis=1)]
    )


def powerlaw_edges(n: int, avg_deg: int, seed: int = 42) -> np.ndarray:
    """Fast deterministic power-law-ish multigraph for bench/skew tests:
    dst drawn Zipf-like via u^-alpha inversion, src uniform."""
    rng = np.random.default_rng(seed)
    e = n * avg_deg
    src = rng.integers(0, n, size=e, dtype=np.int64)
    u = rng.random(e)
    dst = np.minimum((n * u**2.5).astype(np.int64), n - 1)
    keep = src != dst
    return np.stack([src[keep], dst[keep]], axis=1)
